from pupiloptixlab_tpu.accel.intersect import (  # noqa: F401
    Hit,
    intersect_any,
    intersect_closest,
)
