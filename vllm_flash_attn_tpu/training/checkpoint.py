"""Checkpoint save/restore with crash-autosave and exact-batch resume.

Covers the reference's fault-tolerance surface (SURVEY.md §5.3-5.4):
- ModelCheckpointMine.on_exception crash-autosave
  (training/src/callbacks/model_checkpoint.py:8-17) -> `autosave_on_crash`
  context manager writing `.auto_save` on any exception
- resume-picks-newest of last vs autosave (src/train.py:70-91)
- sampler state rides inside the checkpoint for exact-batch resume
  (language_modeling_hf.py:280-299)

Storage is orbax-checkpoint (the TPU-native array format; handles sharded
arrays across a mesh transparently).
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, tag) -> Path:
        return self.directory / str(tag)

    def save(self, tag, state: Any, extra: Optional[dict] = None) -> None:
        """state: any pytree of arrays; extra: small JSON metadata
        (sampler counters, step, wall-clock)."""
        path = self._path(tag)
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path / "state", state)
        self._ckptr.wait_until_finished()
        if extra is not None:
            (path / "extra.json").write_text(json.dumps(extra))
        self._gc()

    def restore(self, tag, abstract_state: Any):
        """abstract_state: pytree of like-shaped arrays/ShapeDtypeStructs."""
        path = self._path(tag)
        state = self._ckptr.restore(path / "state", abstract_state)
        extra_path = path / "extra.json"
        extra = json.loads(extra_path.read_text()) if extra_path.exists() else {}
        return state, extra

    def newest(self) -> Optional[str]:
        """Pick the newest checkpoint — autosave included (src/train.py:70-91)."""
        candidates = [
            p for p in self.directory.iterdir()
            if p.is_dir() and (p / "state").exists()
        ]
        if not candidates:
            return None
        return max(candidates, key=lambda p: p.stat().st_mtime).name

    def _gc(self) -> None:
        tagged = sorted(
            (
                p for p in self.directory.iterdir()
                if p.is_dir() and p.name not in ("auto_save", "last")
            ),
            key=lambda p: p.stat().st_mtime,
        )
        import shutil

        while len(tagged) > self.max_to_keep:
            shutil.rmtree(tagged.pop(0))

    @contextlib.contextmanager
    def autosave_on_crash(self, get_state, get_extra=lambda: None):
        """Write an `auto_save` checkpoint if the wrapped block raises
        (crash-autosave semantics, model_checkpoint.py:8-17)."""
        try:
            yield
        except Exception:
            try:
                self.save("auto_save", get_state(), get_extra())
            except Exception:
                pass
            raise
