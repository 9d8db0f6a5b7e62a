"""`python -m linkpred_tpu` — the app launcher (reference `app.py:1-5`
spawns the Streamlit server; here it is the CLI)."""

from linkpred_tpu.cli import main

main()
