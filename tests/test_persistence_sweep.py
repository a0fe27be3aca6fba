"""Broad fit -> save -> load -> transform sweep: one representative
stateful operator per family, asserting the restored instance transforms
IDENTICALLY to the in-session fit. Catches any fitted attribute whose
runtime type silently stops being JSON-serializable (numpy scalars,
Decimal, tuples) — save_state would now raise, and this sweep would go
red the same round."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (
            i,
            float(i % 17) if i % 11 else None,
            float((i * 7) % 29) + 0.5,
            "ABCDEFG"[i % (3 if i < 150 else 7)],
            1 if (i * 13) % 5 < 2 else 0,
        )
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "id bigint, x double, y double, cat string, target int"
    )


BUILDERS = {
    "mean_imputer": lambda: ff.MeanMedianImputer(["x"]),
    "endtail_imputer": lambda: ff.EndTailImputer(["x"]),
    "categorical_imputer": lambda: ff.CategoricalImputer(["cat"]),
    "count_encoder": lambda: ff.CountFrequencyEncoder(["cat"]),
    "ordinal_encoder": lambda: ff.OrdinalEncoder(["cat"]),
    "mean_encoder": lambda: ff.MeanEncoder(["cat"], "target"),
    "woe_encoder": lambda: ff.WoEEncoder(["cat"], "target"),
    "rare_label": lambda: ff.RareLabelEncoder(["cat"], threshold=0.05),
    "oof_mean_encoder": lambda: ff.OutOfFoldMeanEncoder(["cat"], "target", "id"),
    "equal_frequency": lambda: ff.EqualFrequencyDiscretizer(["y"], bins=4),
    "equal_width": lambda: ff.EqualWidthDiscretizer(["y"], bins=4),
    "geometric": lambda: ff.GeometricWidthDiscretizer(["y"], bins=3),
    "winsorizer": lambda: ff.Winsorizer(["y"]),
    "outlier_trimmer": lambda: ff.OutlierTrimmer(["y"]),
    "minmax_scaler": lambda: ff.MinMaxScaler(["y"]),
    "standard_scaler": lambda: ff.StandardScaler(["y"]),
    "robust_scaler": lambda: ff.RobustScaler(["y"]),
}


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_roundtrip_identical(spark, frame, tmp_path, name):
    op = BUILDERS[name]().fit(frame)
    expected = _rows(op.transform(frame))
    path = str(tmp_path / f"{name}_state")
    op.save_state(path)
    restored = BUILDERS[name]().load_state(path, spark)
    assert _rows(restored.transform(frame)) == expected


def test_kmeans_centroids_roundtrip(spark, tmp_path):
    vecs = spark.createDataFrame(
        [(i, [float((i * 13 + j * 5) % 11) - 5.0 for j in range(8)])
         for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    op = ff.KMeansClusterer("embedding", "vec_id", k=4, iterations=2).fit(vecs)
    expected = _rows(op.transform(vecs))
    path = str(tmp_path / "kmeans_state")
    op.save_state(path)
    restored = ff.KMeansClusterer(
        "embedding", "vec_id", k=4, iterations=2
    ).load_state(path, spark)
    assert restored.centroids_ == op.centroids_
    assert _rows(restored.transform(vecs)) == expected
