from .pc_data import PCData, pc_batch_to_codes
from .kd_partition import kd_tree_partition, kd_tree_partition_randomly
