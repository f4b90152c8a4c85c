from .gather_dma import gather_rows_dma

__all__ = ["gather_rows_dma"]
