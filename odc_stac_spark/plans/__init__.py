from .load import LoadPlan, assemble_numpy, load, plan_load

__all__ = ["LoadPlan", "assemble_numpy", "load", "plan_load"]
