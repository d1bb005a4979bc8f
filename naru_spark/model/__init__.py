from naru_spark.model.made import ResMADE
from naru_spark.model.binning import ModelBinning

__all__ = ["ResMADE", "ModelBinning"]
