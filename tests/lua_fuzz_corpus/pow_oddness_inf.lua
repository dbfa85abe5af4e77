-- bug class: pow oddness check vs infinite exponents (round-2 fix
-- 5fe019f) — C99 pow of a negative base with a non-integer or infinite
-- exponent; int(inf) must not be attempted when classifying odd
-- integer exponents.
function f(x, y)
  local e = 1 / math.abs(x)     -- +inf when a lane has x == 0
  local a = (0 - 2) ^ e
  local b = (-math.abs(y)) ^ (x * 4)
  return a, b
end
