"""vidsitu_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for the VidSitu
video semantic-role-labeling task suite (verb prediction, SRL generation,
event-relation classification), built from scratch against the capability
surface of TheShadow29/VidSitu (CVPR 2021).
"""

__version__ = "0.1.0"
