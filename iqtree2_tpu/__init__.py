"""iqtree2_tpu — a TPU-native phylogenomic maximum-likelihood framework.

A from-scratch re-design of the capabilities of IQ-TREE 2 (reference:
/root/reference) for TPU hardware: Felsenstein pruning expressed as batched
JAX einsums over per-site partial-likelihood tensors, substitution models via
eigendecomposition, branch-length Newton optimization through theta buffers,
stochastic NNI tree search driven from the host, UFBoot replicates and
ModelFinder grids as extra batch dimensions, and site sharding across device
meshes with psum reductions.
"""

__version__ = "0.1.0"

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.tree.topology import Tree

__all__ = ["Alignment", "Tree", "__version__"]
