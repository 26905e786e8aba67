"""`python -m speecht_tpu` == the speecht-cli entry point."""

from speecht_tpu.cli import main

main()
