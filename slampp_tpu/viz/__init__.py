"""Plotting: trajectory/graph plots and matrix sparsity rasterization
(replaces the reference's TGA rasterizer, FlatSystem.h:2717 Plot2D/Plot3D and
CUberBlockMatrix::Rasterize, with matplotlib)."""

from slampp_tpu.viz.plot import plot_system, plot_system_3d, rasterize_block_matrix
