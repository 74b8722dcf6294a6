from .camera import (
    camera_center,
    camera_center_h,
    compose_KRT,
    coord2pix,
    crossmat,
    denormalize_pixel,
    fundamental_matrix,
    neighbor_cameras,
    normalize_pixel,
    pix2coord,
    project_point_radial,
)
from .triangulate import (
    dlt_triangulate,
    dlt_triangulate_pair,
    point_line_distances,
    triangulate_pymvg,
    triangulate_ransac,
    triangulate_refine,
)
