"""DiffMa-TPU: a TPU-native (JAX / XLA / Pallas / pjit) diffusion-Mamba framework.

Re-implements the full capability surface of wongzbb/DiffMa-Diffusion-Mamba
(CT->MRI conditional latent diffusion with selective-state-space backbones)
as an idiomatic TPU framework:

- ``diffma_tpu.ops``       -- Pallas/XLA compute kernels (selective scan, SSD,
                              causal conv, norms) + static 2-D scan-order specs.
- ``diffma_tpu.models``    -- Flax modules: Mamba1/Mamba2 mixers, the six
                              backbone blocks, the DiffMa model + registry,
                              conditioning encoders (CT encoder, VAE, CLIP ViT).
- ``diffma_tpu.diffusion`` -- Gaussian diffusion as pure functions over
                              coefficient tables; jitted losses; lax.scan
                              samplers (DDPM + DDIM); respacing; t-samplers.
- ``diffma_tpu.parallel``  -- Mesh construction and sharding rules (dp/tp/sp)
                              over ICI; collectives are emitted by pjit.
- ``diffma_tpu.data``      -- .npy triplet dataset + per-host sharded loading.
- ``diffma_tpu.train``     -- train / sample / embedder pipelines, EMA,
                              checkpointing (Orbax + torch-pickle import).
- ``diffma_tpu.utils``     -- config (YAML+flags), logging, torch weight IO.
"""

__version__ = "0.1.0"
