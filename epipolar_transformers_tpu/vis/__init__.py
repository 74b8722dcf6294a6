from .skeletons import (
    CONNECTIVITY_DICT,
    draw_2d_pose,
    draw_3d_pose,
    plot_hand_3d,
    plot_single_hand_2d,
    plot_two_hand_2d,
)
from .visualization import (
    assemble_video,
    auc_curve,
    epipolar_introspection,
    export_pointclouds,
)
