"""Model inference queries through the facade — CatalogModel DDL +
ML_PREDICT (models.py) proven end-to-end with DuckDB oracles.

The scoring lane is one mapInPandas over the scan (no shuffle, pinned in
tests/test_models.py); the oracles recompute the provider math
relationally in DuckDB (list_transform/list_sum), rounded to 6 like the
similarity family.
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query


def _tenv(spark, sf_dir):
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    return tenv


@query(
    "model_predict_l2norm",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_sum(list_transform(
               embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
           ))), 6) AS score
    FROM embeddings
    ORDER BY vec_id
    """,
)
def model_predict_l2norm(spark, sf_dir):
    """CREATE MODEL + ML_PREDICT batch scoring: the l2-norm provider over
    the embedding column — per-partition Arrow-batched, zero shuffles."""
    tenv = _tenv(spark, sf_dir)
    tenv.sql("DROP MODEL IF EXISTS q_norm")
    tenv.sql(
        """
        CREATE MODEL q_norm
        INPUT (embedding ARRAY<FLOAT>)
        OUTPUT (raw_score DOUBLE)
        WITH ('provider' = 'vector-l2norm')
        """
    )
    return tenv.sql(
        """
        SELECT vec_id, label, ROUND(raw_score, 6) AS score
        FROM ML_PREDICT(TABLE embeddings, MODEL q_norm,
                        DESCRIPTOR(embedding))
        ORDER BY vec_id
        """
    )


@query(
    "model_predict_linear",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(CAST(embedding[1] AS DOUBLE) * 3
                     + CAST(embedding[2] AS DOUBLE) * -1 + 0.5), 6)
               AS avg_y
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def model_predict_linear(spark, sf_dir):
    """Linear model (weights/bias from WITH options) scored with
    ML_PREDICT, aggregated per class label — the canonical batch-scoring
    -> evaluation shape. Weights hit only the first two dims, so the
    oracle is exact elementwise arithmetic."""
    tenv = _tenv(spark, sf_dir)
    dim = len(spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .first()["embedding"])
    weights = ",".join(["3", "-1"] + ["0"] * (dim - 2))
    tenv.sql("DROP MODEL IF EXISTS q_lin")
    tenv.sql(
        f"""
        CREATE MODEL q_lin
        INPUT (embedding ARRAY<FLOAT>)
        OUTPUT (y DOUBLE)
        WITH ('provider' = 'linear', 'weights' = '{weights}',
              'bias' = '0.5')
        """
    )
    return tenv.sql(
        """
        SELECT label, COUNT(*) AS n, ROUND(AVG(y), 6) AS avg_y
        FROM ML_PREDICT(TABLE embeddings, MODEL q_lin)
        GROUP BY label
        ORDER BY label
        """
    )
