"""Wire/file format codecs implemented in pure Python.

Reference parity (SURVEY.md §2.1 formats row): the reference ships format
modules under ``flink-formats/`` (flink-avro, flink-protobuf, ...) that
(de)serialize rows at the connector boundary. Spark's equivalents for avro
and protobuf live in external jars not present in this environment, so this
package provides spec-compliant pure-Python codecs wired into Spark the
idiomatic Spark-4 way:

- :mod:`avro_format` — Avro Object Container Files as a registered Python
  DataSource (``spark.read.format("pyavro")``), distributed one-file-per-
  partition on both read and write.
- :mod:`protobuf_format` — protobuf wire-format encode/decode as Arrow-
  batched pandas UDFs over ``binary`` columns (the reference's
  flink-protobuf is likewise a row format over binary payloads, not a file
  format).

Both derive purely from the public specifications (Avro 1.11 spec,
protobuf encoding docs).
"""
