"""deciphon-tpu: TPU-native frame-aware protein annotation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
EBI-Metagenomics/deciphon: press HMMER3 protein profiles into frame-aware
(quasi-codon) nucleotide profile databases and scan long, error-prone reads
directly against them with a min-plus (Viterbi) dynamic program.
"""

__version__ = "0.1.0"
