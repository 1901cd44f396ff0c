"""Deep Xi-TPU: a TPU-native (JAX/XLA/Pallas) speech-enhancement framework.

A from-scratch rebuild of the capabilities of Deep Xi (reference:
golfbears/DeepXi, TF2/Keras): DNN-based *a priori* SNR (xi) estimation for
speech enhancement (MMSE gains), DeepMMSE noise-PSD estimation, IBM/IRM
mask estimation and robust-ASR front-ending -- re-designed TPU-first:

  * the analysis/synthesis DSP chain (framing, windowing, (i)STFT/(i)STDCT,
    SNR mixing, CDF maps, gain functions) is pure JAX, jit-compiled end to
    end on device, with fused Pallas kernels for the hot spectral ops;
  * model families (ResNet TCN, MHANet, ResLSTM/ResBiLSTM, RDLNet) are
    functional flax modules over static-shaped, masked batches;
  * training/inference scale over a `jax.sharding.Mesh` (data/model axes)
    with XLA collectives -- no host round-trips in the hot path.

Layer map mirrors the reference (see SURVEY.md section 1):
  sig/        L1 signal-processing core        (ref: deepxi/sig.py, dct.py)
  ops/        L1/L2 maps, gains, special fns, Pallas kernels
              (ref: deepxi/map.py, deepxi/gain.py)
  inp_tgt.py  L2 feature/target transforms     (ref: deepxi/inp_tgt.py)
  models/     L3 networks                      (ref: deepxi/network/*)
  training/   L4 trainer/checkpointing         (ref: deepxi/model.py train)
  infer.py    L4 inference driver              (ref: deepxi/model.py infer)
  testing.py  L7 objective evaluation          (ref: deepxi/model.py test)
  data/       L6 data/batch IO                 (ref: deepxi/utils.py, se_batch.py)
  parallel/   mesh/sharding layer              (no reference equivalent; TPU-native)
  compat/     importers for reference artifacts (SavedModel ckpts, stats pickles)
"""

__version__ = "0.1.0"
