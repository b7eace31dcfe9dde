"""Utilities: checkpoint/resume, diagnostics."""
from sem_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["save_checkpoint", "load_checkpoint"]
