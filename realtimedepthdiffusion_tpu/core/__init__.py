"""Pure-functional JAX core: the reference's CUDA layers L1-L3 redesigned as
composable jit-compatible ops (see SURVEY.md §1-§2 for the component map)."""
