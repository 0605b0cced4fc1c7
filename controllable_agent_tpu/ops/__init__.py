from .fb import fb_loss_terms, orthonormality_loss, sample_z, off_diagonal_mask
