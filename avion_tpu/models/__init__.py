from avion_tpu.models.registry import create_model, register_model, list_models
