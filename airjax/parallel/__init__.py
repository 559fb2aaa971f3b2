"""Multi-chip / multi-host parallelism: meshes, overlap-save halo exchange."""
