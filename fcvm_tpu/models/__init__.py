"""Model definition: meshes, materials, boundary conditions, loads, ingest."""
