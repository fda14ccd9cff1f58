"""Device-side rendering: sampling, BSDFs, emitters, textures, integrator.

Submodules import lazily to avoid a cycle with ``accel`` (the integrator
uses the intersector, which uses ``render.sampling``).
"""


def __getattr__(name):
    if name in ("render", "render_frame", "render_sample"):
        from pupiloptixlab_tpu.render import integrator

        return getattr(integrator, name)
    raise AttributeError(name)
