"""Session bootstrap placeholder (full version added with the MoE layer)."""
