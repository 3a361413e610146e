"""Utilities surface used by the reference's ddpm.py at import time."""
from pytorch_lightning.utilities.distributed import rank_zero_only  # noqa: F401
