"""r3det_tpu: a TPU-native rotated-object-detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
r3det-pytorch reference (R3Det + rotated RetinaNet on DOTA): three angle
conventions, rotated IoU/NMS, feature refinement, the DOTA dataset with
patch split/merge/submission, and data-parallel training over TPU meshes.
"""

__version__ = '0.1.0'
