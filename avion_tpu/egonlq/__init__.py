from avion_tpu.egonlq.vslnet import VSLNet, vslnet_loss, extract_top_spans
from avion_tpu.egonlq.nlq_eval import evaluate_nlq
