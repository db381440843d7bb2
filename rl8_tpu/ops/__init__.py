"""Pallas TPU kernels for hot ops.

The reference leans on ``torch.compile``/aten for its fast paths (see
SURVEY.md section 2); the TPU analog is XLA fusion, with Pallas kernels
where a single fused kernel beats what XLA schedules — currently the
reverse-time GAE scan.
"""

from .gae import gae_fits_vmem, pallas_gae
from .packing import RowUnpacker, block_shuffle, pack_rows

__all__ = ["RowUnpacker", "block_shuffle", "gae_fits_vmem", "pack_rows", "pallas_gae"]
