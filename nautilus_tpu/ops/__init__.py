"""Pure jittable numerical kernels (geometry, GMM, MLP, ranks)."""
