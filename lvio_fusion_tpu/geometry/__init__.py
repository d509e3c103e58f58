from lvio_fusion_tpu.geometry import so3, se3

from lvio_fusion_tpu.geometry.so3 import (
    quat_identity,
    quat_mul,
    quat_conj,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    mat_to_quat,
    exp_so3,
    log_so3,
    slerp,
    rpy_to_quat,
    quat_to_rpy,
    g2R,
)
from lvio_fusion_tpu.geometry.se3 import (
    se3_identity,
    se3_make,
    se3_q,
    se3_t,
    se3_mul,
    se3_inv,
    se3_apply,
    se3_exp,
    se3_log,
    se3_slerp,
    se3_boxplus,
    se3_to_mat,
    rpyxyz_to_se3,
    se3_to_rpyxyz,
)
