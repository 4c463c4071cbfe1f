# Tier C LLM-data-pipeline functions (SURVEY.md §2.12); modules register
# oracle-checked queries and expose reusable DataFrame transforms.
