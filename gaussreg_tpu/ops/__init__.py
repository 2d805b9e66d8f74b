from gaussreg_tpu.ops.transforms import (
    apply_transform,
    apply_rotation,
    transform_from_rotation_translation,
    rotation_translation_scale_from_transform,
    inverse_rigid_transform,
    quaternion_to_matrix,
    matrix_to_quaternion,
    quaternion_multiply,
    rodrigues_rotation,
    random_rotation,
    skew_symmetric,
)
from gaussreg_tpu.ops.pairwise import pairwise_sq_dist, masked_pairwise_sq_dist
from gaussreg_tpu.ops.subsample import grid_subsample, furthest_point_sample_host
from gaussreg_tpu.ops.neighbors import radius_search, knn_search
from gaussreg_tpu.ops.partition import point_to_node_partition
from gaussreg_tpu.ops.procrustes import weighted_procrustes, umeyama_similarity
from gaussreg_tpu.ops.ransac import ransac_similarity
from gaussreg_tpu.ops.sinkhorn import log_optimal_transport
