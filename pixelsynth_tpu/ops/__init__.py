from pixelsynth_tpu.ops.splat import splat, splat_dense, dilate_mask
from pixelsynth_tpu.ops.masked_conv import locally_masked_conv2d, unfold_patches
from pixelsynth_tpu.ops.distance_transform import signed_distance_field
from pixelsynth_tpu.ops.orders import (
    custom_order,
    generation_order,
    kernel_masks_from_order,
    masks_for_order,
    rank_grid_from_order,
    augment_orders,
)

__all__ = [
    "splat",
    "splat_dense",
    "dilate_mask",
    "locally_masked_conv2d",
    "unfold_patches",
    "signed_distance_field",
    "custom_order",
    "generation_order",
    "kernel_masks_from_order",
    "masks_for_order",
    "rank_grid_from_order",
    "augment_orders",
]
