"""Controllable XGating — TPU-native video captioning framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of
vsislab/Controllable_XGating (ICCV'19: "Controllable Video Captioning with POS
Sequence Guidance Based on Gated Fusion Network", arXiv:1908.10072):

- cross-gated ("XGating") fusion of appearance (IRv2) and motion (I3D/C3D)
  feature streams,
- a global POS-sequence generator whose pooled embedding guides (and lets a
  user control) caption syntax,
- a temporal-attention LSTM caption decoder,
- XE and self-critical (SCST, CIDEr-D reward) training,
- greedy + beam-5 inference fully on device,
- its own metrics stack (PTB tokenizer, BLEU, ROUGE-L, CIDEr/CIDEr-D, METEOR).

Provenance note: the reference mount (/root/reference) was empty in every
session so far (see SURVEY.md §0), so behavior is specified by the paper,
BASELINE.json and SURVEY.md rather than by file:line citations into reference
code. Each module docstring records which reference component it rebuilds.
"""

__version__ = "0.1.0"
