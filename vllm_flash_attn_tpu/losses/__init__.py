"""Drop-in import-path alias for the reference's `flash_attn.losses`."""
