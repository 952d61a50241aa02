#!/usr/bin/env python
"""Sharded training (DP x TP x SP) on synthetic data; see training_run.py for
the full CLI with yaml experiments, checkpointing and resume."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vllm_flash_attn_tpu.models.gpt import GPTConfig
from vllm_flash_attn_tpu.training.data import synthetic_tokens
from vllm_flash_attn_tpu.training.trainer import TrainConfig, Trainer

cfg = TrainConfig(
    model=GPTConfig(
        vocab_size=1024, n_positions=0, n_embd=256, n_layer=4, n_head=8,
        n_head_kv=4, rotary_emb_dim=32, gated_mlp=True, rms_norm=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu", n_inner=512,
    ),
    seq_len=256, global_batch_size=8, max_steps=20, tp=4,
    sequence_parallel=True, log_every=5,
)
trainer = Trainer(cfg, synthetic_tokens(1024, 1 << 20))
print(f"mesh: dp={trainer.dp} tp={trainer.tp}")
final = trainer.fit()
print("final:", final)
