from pupiloptixlab_tpu.render.integrator import (  # noqa: F401
    render,
    render_frame,
    render_sample,
)
