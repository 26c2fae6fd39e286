"""``python -m icdc_dataloader_spark`` — the loader.py CLI analogue."""

from .cli import main

if __name__ == "__main__":
    main()
