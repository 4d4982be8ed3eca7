from .ctc_token_fst import ctc_token_fst_text
