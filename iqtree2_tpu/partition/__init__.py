from iqtree2_tpu.partition.engine import PartitionEngine  # noqa: F401
