from avion_tpu.losses.losses import (
    clip_loss,
    max_margin_ranking_loss,
    siglip_loss,
    siglip_loss_chunked,
    softmax_cross_entropy,
    soft_target_cross_entropy,
)
