from .grid_sample import grid_sample_2d, grid_sample_nhwc
from .heatmap import make_heatmap_grid, render_gaussian_heatmaps
from .soft_argmax import find_peak, find_tensor_peak_batch, get_max_preds
