"""PySpark-native spatial-join + tiling engine.

From-scratch re-expression of the query/data-processing semantics of
``ManishSahu53/Vector-Map-Generation-from-Aerial-Imagery-using-Deep-Learning-GeoSpatial-UNET``
(read-only at /root/reference) as pure ``pyspark.sql`` DataFrame operators plus
vectorized pandas/Arrow UDFs.  See SURVEY.md for the operator inventory this
package implements (S1-S9, O1-O11, P1-P8, M1-M11) and the file:line citations
into the reference for every pinned formula.

Not a port: the reference is an imperative single-node GDAL/OpenCV pipeline;
this engine declares lazy DataFrame plans and lets Catalyst/AQE pick physical
strategy.  Python is entered only at Arrow UDF boundaries.
"""

from .config import EngineConfig, DEFAULT_CONFIG
from .session import get_spark

__all__ = ["EngineConfig", "DEFAULT_CONFIG", "get_spark"]
__version__ = "0.1.0"
