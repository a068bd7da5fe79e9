"""End-to-end pipelines: extraction ETL, graph analytics (cc / pagerank /
labelprop / triangles), dedup families, similarity search, text
analysis, multimodal plumbing. Every pipeline is Dataset -> Dataset and
composable; none owns the Ray session."""
