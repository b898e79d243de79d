from qasr.models.layers import PReLU, QBatchNorm, QConv, QDense, flatten_quaternion
from qasr.models.qcnn import QCNNEncoder, RealCNNEncoder

__all__ = [
    "PReLU",
    "QBatchNorm",
    "QConv",
    "QDense",
    "flatten_quaternion",
    "QCNNEncoder",
    "RealCNNEncoder",
]
