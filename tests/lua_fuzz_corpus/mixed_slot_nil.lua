-- bug class: mixed per-slot nil in a multi-value return (round 2) —
-- a return whose slots carry DIFFERENT nil masks is Unvectorizable
-- (nil is tracked per RETURN, not per slot); identical-mask slots
-- (the nil-protocol ray triple) still vectorize.
function g(x, y)
  local a = x
  local b = y
  if x > 0 then a = nil end
  return a, b
end
function f(x, y)
  local a, b = g(x, y)
  if a == nil then a = 0.5 end
  return a + b, a - b
end
