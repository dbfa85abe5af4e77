-- round 5: load()'d chunks are ordinary functions through the same
-- evaluator; they must vectorize bit-equal lane-for-lane (incl. called
-- under a mask), and a syntax error yields nil+message on both engines.
local core = load("local a, b = ... ; return a * 0.5 + b, a - b")
local bad, msg = load("this is not lua(")
function f(x, y)
  if bad ~= nil or msg == nil then return nil end
  local p, q = core(x, y)
  if x > 0 then p = core(q, p) end
  return p, q
end
