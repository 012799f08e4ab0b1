"""DDSP-SVC-TPU: a TPU-native singing-voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
DDSP-SVC reference (tarepan/DDSP-SVC-official): differentiable-DSP
synthesizers (Sins / CombSub / CombSubFast), a conformer-performer control
network, HuBERT-soft unit encoding, F0/volume feature extraction, an
NSF-HiFiGAN enhancer, multi-scale spectral losses, training/checkpointing,
offline and streaming (SOLA) inference — designed for TPU meshes
(pjit/shard_map) rather than single-GPU torch.

Layout:
    ops/       pure jittable DSP functions (phase, filters, STFT, resample)
    nn/        network modules (PCmer, Unit2Control, HuBERT, NSF-HiFiGAN)
    models/    synthesizer models + spectral losses + factory
    data/      wav I/O, slicer, feature extractors, preprocessing, dataset
    train/     jitted training step, solver loop, saver/checkpointing
    infer/     offline CLI pipeline, enhancer, streaming SOLA engine
    parallel/  device mesh, sharding rules, multi-chip train/infer step
    utils/     config (yaml->DotDict), torch->jax weight converters
"""

__version__ = "0.1.0"
