"""Fused Pallas quaternion kernels (MXU-tiled; SURVEY.md §2b R1/R2)."""

from qasr.ops.pallas.qgemm import qconv2d_pallas, qdense_pallas, qgemm
from qasr.ops.pallas.qconv_ft import (
    qconv2d_ft,
    qconv2d_ft8_stacked,
    qconv2d_ft_stacked,
)

NATIVE_QDENSE = True
NATIVE_QCONV = True

__all__ = [
    "qgemm",
    "qdense_pallas",
    "qconv2d_pallas",
    "qconv2d_ft",
    "qconv2d_ft_stacked",
    "qconv2d_ft8_stacked",
]
