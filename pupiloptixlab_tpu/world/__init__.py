from pupiloptixlab_tpu.world.world import RenderObject, World  # noqa: F401
