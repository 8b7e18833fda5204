"""Flax model components: mixers, blocks, DiffMa, conditioning encoders."""

from diffma_tpu.models.diffma import DiffMa, DiffMa_models  # noqa: F401
