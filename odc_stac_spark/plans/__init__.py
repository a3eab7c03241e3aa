from .load import Dataset, LoadPlan, assemble_dataset, assemble_numpy, load, plan_load

__all__ = ["Dataset", "LoadPlan", "assemble_dataset", "assemble_numpy", "load", "plan_load"]
