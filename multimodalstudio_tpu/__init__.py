"""mms-tpu: a TPU-native multimodal neural-rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MMS-FW
(LTTM/MultimodalStudio, CVPR 2025): one shared implicit SDF geometry rendered
with NeuS volume rendering plus per-modality radiance decoders, trained from
multi-view captures in up to five imaging modalities (RGB, monochrome,
near-infrared, polarization, multispectral), with mosaicked (raw) and
demosaicked frame support.

Design: every training step compiles to a single XLA program (ray generation,
NeuS hierarchical sampling with unrolled upsample rounds, field evaluation,
compositing, losses, optimizer update), sharded data-parallel over a
`jax.sharding.Mesh`. Schedules are pure functions of the step scalar; there is
no callback mutation. Dynamic boolean masking from the reference becomes
static-shape masked dense compute.
"""

__version__ = "0.1.0"
