"""Model DDL + ML_PREDICT — reference CatalogModel / CREATE MODEL parity
(parserImpls.ftl:3376 grammar; Catalog.java model CRUD) with the
Spark-first mapInPandas scoring lane."""

from __future__ import annotations

import math

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.models import ModelError, ml_predict

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


CREATE_NORM = """
CREATE MODEL norm_model
INPUT (embedding ARRAY<FLOAT>)
OUTPUT (score DOUBLE)
COMMENT 'l2 norm scorer'
WITH ('provider' = 'vector-l2norm', 'task' = 'regression')
"""


def test_create_show_drop_lifecycle(tenv):
    assert tenv.sql(CREATE_NORM).first().result == "OK"
    assert [r.model_name for r in tenv.sql("SHOW MODELS").collect()] == [
        "norm_model"
    ]
    ddl = tenv.sql("SHOW CREATE MODEL norm_model").first().result
    assert "CREATE MODEL `norm_model`" in ddl
    assert "'provider' = 'vector-l2norm'" in ddl
    assert "COMMENT 'l2 norm scorer'" in ddl
    # duplicate errors loudly; IF NOT EXISTS doesn't
    with pytest.raises(ModelError, match="already exists"):
        tenv.sql(CREATE_NORM)
    tenv.sql(
        "CREATE MODEL IF NOT EXISTS norm_model "
        "WITH ('provider' = 'vector-l2norm')"
    )
    tenv.sql("DROP MODEL norm_model")
    assert tenv.sql("SHOW MODELS").count() == 0
    with pytest.raises(ModelError, match="does not exist"):
        tenv.sql("DROP MODEL norm_model")
    tenv.sql("DROP MODEL IF EXISTS norm_model")


def test_ml_predict_l2norm_matches_python(tenv, spark):
    tenv.sql("DROP MODEL IF EXISTS norm_model")
    tenv.sql(CREATE_NORM)
    got = {
        r.vec_id: r.score
        for r in tenv.sql(
            "SELECT vec_id, score FROM "
            "ML_PREDICT(TABLE embeddings, MODEL norm_model, "
            "DESCRIPTOR(embedding)) WHERE vec_id < 10"
        ).collect()
    }
    rows = spark.table("embeddings").filter("vec_id < 10").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        want = math.sqrt(sum(float(x) * float(x) for x in r.embedding))
        assert got[r.vec_id] == pytest.approx(want, rel=1e-12)


def test_ml_predict_linear_with_alter(tenv, spark):
    dim = len(spark.table("embeddings").first().embedding)
    weights = ",".join(["0"] * (dim - 1) + ["2"])
    tenv.sql(
        f"""
        CREATE MODEL last_x2
        INPUT (embedding ARRAY<FLOAT>)
        OUTPUT (y DOUBLE)
        WITH ('provider' = 'linear', 'weights' = '{weights}')
        """
    )
    row = tenv.sql(
        "SELECT vec_id, embedding, y FROM "
        "ML_PREDICT(TABLE embeddings, MODEL last_x2) WHERE vec_id = 1"
    ).first()
    assert row.y == pytest.approx(2.0 * float(row.embedding[-1]), rel=1e-12)
    # ALTER MODEL SET updates options in place (SqlAlterModel)
    tenv.sql("ALTER MODEL last_x2 SET ('bias' = '10')")
    row2 = tenv.sql(
        "SELECT y FROM ML_PREDICT(TABLE embeddings, MODEL last_x2) "
        "WHERE vec_id = 1"
    ).first()
    assert row2.y == pytest.approx(row.y + 10.0, rel=1e-12)
    tenv.sql("DROP MODEL last_x2")


def test_validation_errors(tenv, spark):
    tenv.sql("DROP MODEL IF EXISTS norm_model")
    tenv.sql(CREATE_NORM)
    df = spark.table("embeddings")
    model = tenv.model_catalog.get("norm_model")
    with pytest.raises(ModelError, match="not present"):
        ml_predict(df, model, ["nope"])
    with pytest.raises(ModelError, match="DESCRIPTOR"):
        ml_predict(df, model, ["embedding", "label"])
    # output-name collision
    clash = df.withColumnRenamed("label", "score")
    with pytest.raises(ModelError, match="collide"):
        ml_predict(clash, model)
    # provider-less model
    tenv.sql("CREATE MODEL bare INPUT (x DOUBLE) OUTPUT (y DOUBLE)")
    with pytest.raises(ModelError, match="provider"):
        ml_predict(df, tenv.model_catalog.get("bare"))
    tenv.sql("DROP MODEL bare")


def test_plan_is_single_mapinpandas_no_shuffle(tenv, spark):
    tenv.sql("DROP MODEL IF EXISTS norm_model")
    tenv.sql(CREATE_NORM)
    df = ml_predict(
        spark.table("embeddings"), tenv.model_catalog.get("norm_model")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # pure per-partition scoring
