"""Console entry points (the bin/ scripts are thin wrappers over these)."""
