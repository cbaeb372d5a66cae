from .model import ModelDef, ModelRegistry, model
from .runner import Runner
from .datatests import DataTest, run_data_tests

__all__ = ["ModelDef", "ModelRegistry", "model", "Runner", "DataTest",
           "run_data_tests"]
