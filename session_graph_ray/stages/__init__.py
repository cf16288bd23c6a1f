"""Pipeline stages. Each exposes pure batch functions / callable classes for
``Dataset.map_batches`` plus a compose helper taking and returning a Dataset
(the Stage protocol from SURVEY.md §2.12)."""
