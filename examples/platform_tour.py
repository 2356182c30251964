#!/usr/bin/env python3
"""Tour of the round-6 platform surfaces: query hints, model DDL +
ML_PREDICT batch scoring, stored procedures (CALL), row-level DML,
statement sets, job management, and the DB-API driver over the SQL
gateway. A SQL user of the reference can run these verbatim shapes.

Usage: python examples/platform_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_spark import TableEnvironment  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    tenv = TableEnvironment.create(sf_dir=SF_DIR)
    spark = tenv.spark

    print("== query hints: steer the physical join ==")
    tenv.sql(
        """
        SELECT /*+ BROADCAST(nation), SHUFFLE_HASH(customer) */
               n_name, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 5
        """
    ).show()

    print("== model DDL + ML_PREDICT batch scoring ==")
    tenv.sql("DROP MODEL IF EXISTS tour_norm")
    tenv.sql(
        """
        CREATE MODEL tour_norm
        INPUT (embedding ARRAY<FLOAT>) OUTPUT (score DOUBLE)
        COMMENT 'embedding L2 norm'
        WITH ('provider' = 'vector-l2norm')
        """
    )
    tenv.sql("SHOW MODELS").show()
    tenv.sql(
        "SELECT vec_id, label, ROUND(score, 4) AS l2 FROM "
        "ML_PREDICT(TABLE embeddings, MODEL tour_norm, "
        "DESCRIPTOR(embedding)) ORDER BY l2 DESC LIMIT 5"
    ).show()

    print("== stored procedures: compaction + stats ==")
    frag = tempfile.mkdtemp() + "/frag"
    spark.range(10_000).repartition(16).write.parquet(frag)
    tenv.sql(f"CALL sys.compact_files('{frag}', 256)").show()
    tenv.sql("CALL sys.table_stats('lineitem')").show(truncate=False)

    print("== row-level DML on a DDL table ==")
    d = tempfile.mkdtemp() + "/t"
    tenv.sql(
        f"""
        CREATE TABLE tour_t (id BIGINT, v DOUBLE) WITH (
            'connector' = 'filesystem', 'path' = '{d}',
            'format' = 'parquet')
        """
    )
    tenv.sql(
        """
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO tour_t SELECT id, id * 1.5 FROM range(10);
          INSERT INTO tour_t SELECT id + 100, 0.0 FROM range(3);
        END
        """
    ).show()
    tenv.sql("UPDATE tour_t SET v = v + 1 WHERE id >= 100").show()
    tenv.sql("DELETE FROM tour_t WHERE id < 5").show()
    tenv.sql("SELECT * FROM tour_t ORDER BY id").show()

    print("== ALTER TABLE / SHOW CREATE / partitions (r6) ==")
    tenv.sql("ALTER TABLE tour_t ADD (note STRING)").show()
    tenv.sql("SHOW CREATE TABLE tour_t").show(truncate=False)
    tenv.sql("DESCRIBE tour_t").show()

    print("== Process Table Function (FLIP-440) ==")
    import pandas as pd

    from apache_flink_spark.ptf import register_ptf

    def running_total(keys, pdf, **_):
        return pd.DataFrame(
            {"id": pdf["id"].to_numpy(), "rt": pdf["v"].cumsum()}
        )

    register_ptf("tour_rt", running_total, "id bigint, rt bigint")
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW tour_b AS "
        "SELECT id, CAST(v AS BIGINT) AS v, id % 2 AS bucket FROM tour_t"
    )
    tenv.sql(
        "SELECT * FROM tour_rt(input => TABLE tour_b "
        "PARTITION BY bucket ORDER BY id) ORDER BY bucket, id LIMIT 6"
    ).show()

    print("== Catalog / module introspection (r6) ==")
    tenv.sql("SHOW CURRENT CATALOG").show()
    tenv.sql("SHOW TABLES LIKE 'tour%'").show()
    tenv.sql("SHOW FULL MODULES").show()
    tenv.sql(
        "ANALYZE TABLE tour_t COMPUTE STATISTICS FOR COLUMNS id"
    ).show()

    print("== DB-API driver over the SQL gateway (REST) ==")
    from apache_flink_spark import dbapi
    from apache_flink_spark.sql_gateway import (
        SqlGatewayRestEndpoint,
        SqlGatewayService,
    )

    svc = SqlGatewayService(spark=spark, sf_dir=SF_DIR)
    ep = SqlGatewayRestEndpoint(svc).start()
    with dbapi.connect(url=ep.url) as conn:
        cur = conn.cursor()
        cur.execute(
            "SELECT r_name, COUNT(*) AS n FROM region JOIN nation "
            "ON r_regionkey = n_regionkey WHERE r_name <> ? "
            "GROUP BY r_name ORDER BY r_name",
            ["EUROPE"],
        )
        for row in cur:
            print("  ", row)
    ep.stop()
    svc.close()
    print("tour complete")


if __name__ == "__main__":
    main()
