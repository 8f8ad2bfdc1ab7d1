"""Asset + image IO: YAML scenes, OBJ/PLY meshes, PNG/PPM output, BVH cache."""
