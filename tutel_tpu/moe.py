"""MoE facade placeholder."""
