"""gaussian_transformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of stu214634/gaussian-transformer (an Inria-3DGS fork with transformers
over Gaussian sequences).

Layering (bottom-up), mirroring SURVEY.md §7:

- ``ops``       L0: compute kernels — differentiable Gaussian rasterization
                (EWA projection, tile binning, front-to-back compositing with a
                custom VJP), 3-NN init distances, Chamfer distance, SSIM.
                Pure-JAX golden implementations plus Pallas production kernels.
- ``scene``     L1: GaussianScene pytree + activations, COLMAP/Blender/PLY IO,
                cameras, scene orchestration.
- ``render``    L2: the differentiable renderer facade (same 4-key output
                contract as the reference: render / viewspace_points /
                visibility_filter / radii).
- ``parallel``  L3: device meshes, sharding rules (data / gaussian / tile axes),
                distributed collectives.
- ``models``    L4: encoder-decoder transformer over Gaussian token sequences,
                box-sort spatial ordering, token codec, fold/unstack, autoencoder.
- ``train``     L5: trainers (3DGS per-scene optimization with adaptive density
                control; stacked/flat transformer trainers; autoencoder trainer).
- ``eval``      L6: offline rendering, SSIM/PSNR/LPIPS metrics, full-eval driver.
- ``viewer``    SIBR remote-viewer wire protocol (byte-compatible TCP server).
- ``config``    reflection-based flag groups (ModelParams / OptimizationParams /
                PipelineParams parity).
"""

__version__ = "0.1.0"
