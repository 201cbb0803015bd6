"""External data sources (SURVEY.md §2.6): OSM PBF, shapefile."""
