from amphion_tpu.text.cleaners import basic_cleaners, english_cleaners
from amphion_tpu.text.g2p import G2PModule, LexiconG2P, intersperse
from amphion_tpu.text.symbol_table import SymbolTable
from amphion_tpu.text.symbols import SYMBOLS, symbols_to_ids
