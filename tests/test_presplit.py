"""Feature pre-split invariants (shstMatchFeatures.js:46,130-175 semantics):
connectivity between parts, chunk-length bound, total-length conservation."""

import numpy as np

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators.snap import presplit_long_shapes
from gtfs_conflation_pipeline_spark.plans.pipeline import geo_shapes_from_raw


def test_presplit_invariants(spark):
    raw = FX.raw_tables(
        spark, FX.images_table(spark, 500, partitions=4, with_bytes=False)
    )
    geo = geo_shapes_from_raw(raw["shapes"])
    parts = presplit_long_shapes(geo).toPandas()
    assert len(parts) > geo.count()  # >2km shapes were split
    assert (parts.length_km <= 2.05).all()
    # connectivity patch: part k starts at part k-1's last coordinate
    for _sid, g in parts.groupby("shape_id"):
        g = g.sort_values("part_index")
        for (_, a), (_, b) in zip(g.iterrows(), g.iloc[1:].iterrows()):
            assert abs(a["xs"][-1] - b["xs"][0]) < 1e-9
            assert abs(a["ys"][-1] - b["ys"][0]) < 1e-9
    # length conservation
    tot_parts = parts.groupby("shape_id").length_km.sum().sort_index()
    tot_shapes = (
        geo.select("shape_id", "length_km")
        .toPandas()
        .set_index("shape_id")
        .length_km.sort_index()
    )
    assert np.allclose(tot_parts.values, tot_shapes.values, rtol=1e-6)
