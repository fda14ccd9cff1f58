from pupiloptixlab_tpu.passes.pt import PTPass  # noqa: F401
from pupiloptixlab_tpu.passes.compute import ComputePass  # noqa: F401
from pupiloptixlab_tpu.passes.denoise import DenoisePass  # noqa: F401
from pupiloptixlab_tpu.passes.restir import ReSTIRPass  # noqa: F401
