"""Fused Pallas quaternion kernels (MXU-tiled; SURVEY.md §2b R1/R2).

Until the native kernels land these delegate to the XLA block-kernel path so
the layer API is stable; `qdense_pallas`/`qconv2d_pallas` are replaced by the
fused implementations in qgemm.py / qconv_kernel.py.
"""

from qasr.ops.qlinalg import qconv as _qconv_xla, qdense as _qdense_xla

NATIVE_QDENSE = False
NATIVE_QCONV = False


def qdense_pallas(x, w, **kwargs):
    return _qdense_xla(x, w, **kwargs)


def qconv2d_pallas(x, w, *, strides=None, padding="SAME", **kwargs):
    return _qconv_xla(x, w, strides=strides, padding=padding, **kwargs)
