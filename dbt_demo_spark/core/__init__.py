from .model import ModelDef, ModelRegistry, model
from .runner import BuildResult, NodeResult, Runner
from .datatests import DataTest, run_data_tests
from .freshness import FreshnessSpec, check_freshness
from .lineage import column_lineage, registry_column_lineage

__all__ = ["ModelDef", "ModelRegistry", "model", "Runner", "BuildResult",
           "NodeResult", "DataTest", "run_data_tests",
           "column_lineage", "registry_column_lineage",
           "FreshnessSpec", "check_freshness"]
