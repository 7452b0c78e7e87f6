"""Utility subsystems: checkpointing, plotting, profiling, weight porting."""
