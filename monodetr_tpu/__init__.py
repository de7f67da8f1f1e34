"""monodetr_tpu — a TPU-native (JAX/XLA/Pallas) monocular-3D-detection framework.

Re-designed from scratch with the capabilities of the MonoDETR reference
(`/root/reference`, ZrrSkywalker/MonoDETR): depth-guided transformer monocular
3D object detection on KITTI.  Everything on the compute path is pure-function
JAX compiled once per (train/eval) shape; the multi-scale deformable attention
CUDA extension of the reference is a fused Pallas gather kernel here; matching
and all losses run on device over fixed-shape padded targets.
"""

__version__ = "0.1.0"
