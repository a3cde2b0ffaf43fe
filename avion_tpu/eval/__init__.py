from avion_tpu.eval.retrieval_metrics import get_map, get_ndcg
from avion_tpu.eval.classification_metrics import (
    topk_accuracy,
    mean_class_accuracy,
    charades_map,
    marginalize,
    get_marginal_indexes,
    egomcq_accuracy,
)
