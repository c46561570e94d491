from clm_gs_tpu.utils.general import (
    inverse_sigmoid,
    build_rotation,
    build_scaling_rotation,
    get_expon_lr_func,
    check_update_at_this_iter,
)
