from qasr.ops.quaternion import (
    hamilton_expand,
    hamilton_product,
    pack_components,
    split_components,
    qdense_naive,
)
from qasr.ops.qlinalg import qconv, qdense, qconv_expanded_oracle
from qasr.ops.initializers import quaternion_init, quaternion_initializer

__all__ = [
    "hamilton_expand",
    "hamilton_product",
    "pack_components",
    "split_components",
    "qdense_naive",
    "qconv",
    "qdense",
    "qconv_expanded_oracle",
    "quaternion_init",
    "quaternion_initializer",
]
