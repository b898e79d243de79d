"""qasr — TPU-native quaternion-CNN end-to-end speech recognition.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
Orkis-Research/Quaternion-Convolutional-Neural-Networks-for-End-to-End-
Automatic-Speech-Recognition (Parcollet et al., Interspeech 2018,
arXiv:1806.07789). See SURVEY.md for the reference analysis this is built to.
"""

__version__ = "0.1.0"
