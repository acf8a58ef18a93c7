"""deepwmh_tpu — TPU-native annotation-free WMH segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lchdl/DeepWMH
(reference: /root/reference). The reference is a Python orchestration layer
shelling out to external C++/CUDA binaries (ANTs, ROBEX, FSL, FreeSurfer,
nnU-Net fork); this package internalizes all of that compute as JAX programs
designed for TPU:

- ``core``          NIfTI I/O, manifests, artifact/checkpoint store
- ``ops``           fused XLA/Pallas volume kernels (stats, NLL, filters,
                    connected components, N4, warping, histograms)
- ``registration``  affine + diffeomorphic (SVF) registration, group runner
- ``unet``          3D U-Net engine: plan / preprocess / train / predict
- ``pipeline``      3-stage annotation-free self-training state machine
- ``cli``           DeepWMH_predict / DeepWMH_train / DeepWMH_install
- ``eval``          metrics and preview rendering
"""

from deepwmh_tpu.pkginfo import __version__  # noqa: F401
