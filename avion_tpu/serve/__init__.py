from avion_tpu.serve.batcher import MicroBatcher  # noqa: F401
from avion_tpu.serve.server import ClipService, make_server  # noqa: F401
