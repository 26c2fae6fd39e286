"""``python -m icdc_dataloader_spark`` — the loader.py CLI analogue."""

from .cli import main

main()
