from skyfall_gs_tpu.utils.general import (
    inverse_sigmoid,
    expon_lr_schedule,
    seed_everything,
)

__all__ = ["inverse_sigmoid", "expon_lr_schedule", "seed_everything"]
