"""Device-mesh parallelism (populated by mesh.py)."""
