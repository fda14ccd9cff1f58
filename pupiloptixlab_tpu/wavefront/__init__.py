from pupiloptixlab_tpu.wavefront.engine import render_wavefront  # noqa: F401
from pupiloptixlab_tpu.wavefront.queues import compact_queue, sort_by_key  # noqa: F401
