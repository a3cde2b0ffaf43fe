from avion_tpu.optim.schedules import cosine_schedule
from avion_tpu.optim.factory import build_optimizer, wd_mask, layer_decay_scales
