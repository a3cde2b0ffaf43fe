from avion_tpu.ops.attention import attention, xla_attention
from avion_tpu.ops.flash_attention import flash_attention
