"""Checkpoint loading from HF-format model directories
(`flash_attn.utils.pretrained.state_dict_from_pretrained` analog, pinned by
the reference's model tests which pull real checkpoints).

Loads weights WITHOUT instantiating a torch model: safetensors (single or
index-sharded) or pytorch_model.bin directories become a flat
{name: np.ndarray} state dict feeding models/hf_convert.REMAPPERS.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def state_dict_from_pretrained(model_dir: str) -> Dict[str, Any]:
    """Flat {param_name: np.ndarray} from a local HF model directory.

    Supports: model.safetensors, model.safetensors.index.json (sharded),
    pytorch_model.bin, pytorch_model.bin.index.json.
    """
    d = Path(model_dir)
    if not d.is_dir():
        raise FileNotFoundError(d)

    st_index = d / "model.safetensors.index.json"
    st_single = d / "model.safetensors"
    pt_index = d / "pytorch_model.bin.index.json"
    pt_single = d / "pytorch_model.bin"

    if st_index.exists() or st_single.exists():
        files = (
            sorted(
                {
                    v
                    for v in json.loads(st_index.read_text())["weight_map"].values()
                }
            )
            if st_index.exists()
            else [st_single.name]
        )
        sd: Dict[str, Any] = {}
        for f in files:
            sd.update(_load_safetensors(d / f))
        return sd

    if pt_index.exists() or pt_single.exists():
        import torch

        files = (
            sorted(
                {
                    v
                    for v in json.loads(pt_index.read_text())["weight_map"].values()
                }
            )
            if pt_index.exists()
            else [pt_single.name]
        )
        sd = {}
        for f in files:
            part = torch.load(d / f, map_location="cpu", weights_only=True)
            sd.update(
                {k: v.numpy() if hasattr(v, "numpy") else v for k, v in part.items()}
            )
        return sd

    raise FileNotFoundError(
        f"no model.safetensors[.index.json] or pytorch_model.bin under {d}"
    )


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header + raw little-endian buffers) — no
    external dependency needed."""
    _DT = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        base = 8 + n
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            lo, hi = meta["data_offsets"]
            f.seek(base + lo)
            buf = f.read(hi - lo)
            dt = meta["dtype"]
            if dt == "BF16":
                # numpy has no bf16: upcast via uint16 bit pattern -> fp32
                raw = np.frombuffer(buf, np.uint16)
                arr = (raw.astype(np.uint32) << 16).view(np.float32)
            elif dt in _DT:
                arr = np.frombuffer(buf, _DT[dt])
            else:
                raise NotImplementedError(f"safetensors dtype {dt}")
            out[name] = arr.reshape(meta["shape"]).copy()
    return out


def from_pretrained_dir(model_dir: str):
    """(GPTConfig, params) from a local HF model directory: reads config.json
    for the model_type and remaps the weights (the full
    `GPTLMHeadModel.from_pretrained` pipeline without network or torch-model
    instantiation)."""
    import types

    from vllm_flash_attn_tpu.models.hf_convert import REMAPPERS, config_from_hf

    d = Path(model_dir)
    raw = json.loads((d / "config.json").read_text())
    hf_config = types.SimpleNamespace(**raw)
    config = config_from_hf(hf_config)
    sd = state_dict_from_pretrained(model_dir)
    return config, REMAPPERS[raw["model_type"]](sd, config)
