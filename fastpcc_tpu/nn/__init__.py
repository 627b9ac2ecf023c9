from .blocks import PReLU, SparseConv3x3, ResBlock, MLP
