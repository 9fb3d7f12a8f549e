"""``python -m pybel_ray`` entry point."""

from .cli import main

main()
