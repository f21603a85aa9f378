"""Engine operators.

Reference-parity core: division, grouping, combine, asof. Training-data
pipeline: dedup, structural, spans, simsearch, pq, clustering, sampling,
mixing, packing, contamination, corpus, retrieval, chunking,
quality_checks, selection, layout. Analytics: funnel, retention, sketch,
timeseries, eventlog, cdc, privacy, profiling, graph, experiment,
basket, linkage, segmentation, survival, recs, evaluation.
"""
