from .triplane import TriplaneColorField, fit_and_paint
