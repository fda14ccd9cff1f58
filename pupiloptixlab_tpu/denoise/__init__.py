from pupiloptixlab_tpu.denoise.atrous import Denoiser, DenoiserMode, denoise  # noqa: F401
