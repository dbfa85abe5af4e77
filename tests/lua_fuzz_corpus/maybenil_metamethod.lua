-- late round 3 (fuzz, extended generator): a _MaybeNil-tracked operand
-- meeting an arithmetic metamethod — the handler's TABLE result must
-- not be wrapped in _MaybeNil (it then failed to index), and active
-- nil lanes must still refuse on the np path.
V = {}
V.__index = V
function V.new(a, b) return setmetatable({a = a, b = b}, V) end
V.__mul = function(u, s) return V.new(u.a * s, u.b * s) end
function f(x, y)
  local g
  if x > 0 then g = y * 2 end
  if g == nil then g = 1.5 end
  local p = V.new(1, 2)
  local q = (p * (g % 3)).a + (p * g).b
  return q, x
end
