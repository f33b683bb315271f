"""Generator-style data sources (no files): the Spark analog of the
reference's generator connectors — TPC-H (plugin/trino-tpch/.../
TpchMetadata.java:102), faker (plugin/trino-faker), blackhole."""
